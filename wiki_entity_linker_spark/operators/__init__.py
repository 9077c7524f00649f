from wiki_entity_linker_spark.operators import (  # noqa: F401
    ann,
    argmax,
    blocking,
    bloom,
    closure,
    dedup,
    graph,
    multimodal,
    packing,
    retrieval,
    skew,
    spans,
)
