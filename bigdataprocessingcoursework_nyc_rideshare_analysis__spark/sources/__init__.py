from .tables import load_table, load_tables  # noqa: F401
from .rideshare import rideshare_schema, zone_lookup_schema, read_rideshare_csv  # noqa: F401
