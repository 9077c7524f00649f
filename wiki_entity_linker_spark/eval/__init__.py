from wiki_entity_linker_spark.eval.pairwise import (  # noqa: F401
    evaluate_against_labeled_pairs,
    pairwise_metrics,
)
