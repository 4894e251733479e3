from .scalar import money_sum, money_avg, route_label  # noqa: F401
from .text import tokens_col, shingles_col, normalize_text  # noqa: F401
from .vector import quantize_vec, dot_q, norm_sq_q  # noqa: F401
