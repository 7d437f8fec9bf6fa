"""wikidatabots_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference batch-ETL system (josh/wikidatabots, a Polars-lazy pipeline
suite), built Spark-first: DataFrame/SQL plans optimized by Catalyst, with
`mapInPandas` adapters only at genuine engine boundaries (HTTP, SPARQL).

Layout
------
- ``session``    SparkSession factory tuned for local testing and cluster scale
- ``functions``  expression library closing Polars↔Spark semantic gaps
- ``sources``    table loaders + HTTP / SPARQL / MediaWiki adapters
- ``sinks``      RDF-statement stdout sink with row-cap guard
- ``operators``  scale-out extensions: dedup, similarity search, text analysis
- ``plans``      the reference's five pipelines, parameterized over inputs
- ``streaming``  Structured Streaming variants of the event-time operators
"""

__version__ = "0.1.0"
