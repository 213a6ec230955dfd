"""feature_store_spark — a PySpark-native, point-in-time-correct
feature-materialization engine.

Built from scratch against the semantics of the reference feature store
(``giangnmt98/feature_store``; see SURVEY.md for the operator inventory with
file:line citations).  Architecture is idiomatic Spark: declarative DataFrame
plans optimized by Catalyst/AQE, with vectorized pandas/Arrow UDFs only for
pixel decoding and perceptual hashing.  No per-row Python in any hot path.
"""

__version__ = "0.1.0"
