from wiki_entity_linker_spark.operators import (  # noqa: F401
    ann,
    argmax,
    blocking,
    closure,
    dedup,
    multimodal,
    packing,
    skew,
    spans,
)
