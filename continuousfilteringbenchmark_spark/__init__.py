"""PySpark-native entity-resolution / filtering engine.

A from-scratch re-expression of the query & data-processing capabilities of
gpapadis/ContinuousFilteringBenchmark (ICDE 2023 filtering-technique benchmark
for Entity Resolution) as an idiomatic PySpark DataFrame pipeline:

    blocking  ->  block cleaning (purging / filtering)  ->  comparison
    cleaning (meta-blocking)  ->  pairwise scoring (set-similarity +
    string-distance)  ->  transitive clustering (connected components)

plus the large-scale training-data operators a 100 TB corpus pipeline needs
(dedup family, ANN similarity search, text analysis, multimodal plumbing).

Everything is declarative DataFrame/SQL so Catalyst + AQE pick physical
plans; Python appears only in vectorized pandas/Arrow UDFs (LSH signatures,
Jaro-Winkler batches, combinatorial key expansion).
"""

__version__ = "0.1.0"
