from .rideshare import (  # noqa: F401
    build_enriched_view,
    task1_enrich_and_validate,
    task2_monthly_rollups,
    task3_topk,
    task4_ratio_of_averages,
    task5_daily_anomaly,
    task6_filters,
    task7_route_pivot,
)
