from wiki_entity_linker_spark.functions import hashing, similarity, text, vectors  # noqa: F401
