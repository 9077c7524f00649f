from wiki_entity_linker_spark.sources.tables import (  # noqa: F401
    ARTICLE_SCHEMA,
    load_sf_tables,
    read_articles_jsonl,
    write_tsv,
)
