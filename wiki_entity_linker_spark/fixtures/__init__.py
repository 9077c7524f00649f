from wiki_entity_linker_spark.fixtures.corpus import ensure_corpus, generate_corpus  # noqa: F401
