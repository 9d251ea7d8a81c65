"""scabillmatch_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ASvyatkovskiy/ScaBillMatch, re-expressed
Spark-first (DataFrame/SQL/Catalyst, not a translation of the reference Scala).

Modules
-------
- ``session``    : SparkSession factory tuned for local testing + cluster scale.
- ``io``         : sources/sinks with explicit schemas (JSON-lines bills, parquet).
- ``functions``  : column-expression library (text cleaning, pk parsing,
                   similarity measures over token-set arrays, vector kernels).
- ``operators``  : relational/dataflow operators — candidate blocking,
                   pair scoring, dedup, ANN search, text stats, graph
                   algorithms, descriptive stats, latest-version extraction.
- ``ml``         : featurization pipeline (tokenize→stopwords→ngram→TF/IDF),
                   KMeans blocking labels, LDA, LSA/SVD, LSH.
- ``streaming``  : Structured Streaming variants sharing batch operator code.
"""

__version__ = "0.1.0"
