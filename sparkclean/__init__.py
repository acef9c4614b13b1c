"""sparkclean — PySpark-native image+caption quality-filter engine.

From-scratch Spark re-expression of cleanlab/cleanlab v2.9.0's
confident-learning semantics, fused with langid / perplexity / heuristic /
scrub caption filtering for web-scale training-data pipelines.
"""

__version__ = "0.1.0"
