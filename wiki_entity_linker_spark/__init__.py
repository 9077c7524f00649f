"""wiki_entity_linker_spark — a PySpark-native entity-resolution engine.

A from-scratch rebuild of the capabilities of ad-freiburg/wiki_entity_linker
(alias-dictionary candidate generation, link-frequency priors, popularity-argmax
disambiguation, transitive entity grouping, P/R/F1 evaluation harness) recast as
an idiomatic Spark DataFrame blocking + pairwise-scoring + transitive-clustering
record-linkage pipeline over source-code file tables
``(repo, path, commit, lang, content)``.

Nothing in this package is a port: the reference is a single-process Python
dict-lookup engine; this is a declarative Catalyst plan with broadcast joins,
window-rank argmax, salted skew handling, Arrow-batched pandas UDF scoring and
iterative large-star/small-star connected components.
"""

__version__ = "0.1.0"
