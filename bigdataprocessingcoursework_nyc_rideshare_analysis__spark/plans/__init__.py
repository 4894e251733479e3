from .explain import plan_string, assert_in_plan, assert_not_in_plan  # noqa: F401
