from arrow_matrix_tpu.plan.compile import ArrowPlan, LevelPlan, compile_plan
from arrow_matrix_tpu.plan.memory import arrow_hbm_footprint, slim_fat_model
from arrow_matrix_tpu.plan.routing import RouteTables, build_route_tables

__all__ = [
    "ArrowPlan",
    "LevelPlan",
    "compile_plan",
    "RouteTables",
    "build_route_tables",
    "arrow_hbm_footprint",
    "slim_fat_model",
]
