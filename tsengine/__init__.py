"""tsengine — a PySpark-native time-series analytics engine.

Rebuilds the query and data-processing capabilities of the reference
repo ``nanuncheria/time-series-data-SSL`` (a CPC self-supervised-learning
pipeline over windowed wearable heart-rate data; see SURVEY.md) as
idiomatic Spark DataFrame operators, extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    tsengine.session    SparkSession factory with scale-tuned defaults
    tsengine.sources    table loaders, wearable-window derivation, CSV io,
                        deterministic batching
    tsengine.operators  the operator library (DataFrame -> DataFrame fns)
    tsengine.pipelines  composed inference pipelines (T/TS/S_CPC DAGs),
                        before-training grid, epoch curves
    tsengine.streaming  Structured Streaming window/session operators +
                        applyInPandasWithState stateful assembly
    tsengine.oracle     DuckDB ANSI-SQL oracle twins for every
                        SQL-expressible operator (driver correctness gate)
"""

__version__ = "0.1.0"
