from wiki_entity_linker_spark.plans.checkpoint import StageManager  # noqa: F401
from wiki_entity_linker_spark.plans.er_pipeline import ERConfig, run_er_pipeline  # noqa: F401
