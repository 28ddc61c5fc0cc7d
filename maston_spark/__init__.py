"""maston-spark: a PySpark-native analytics engine with the
capabilities of Barbicane-fr/maston (validated Kafka ingestion,
error-channel provenance, keyed delta/dedup state), generalized to a
full batch+streaming relational surface plus LLM-data-pipeline
operators, designed for 100 TB scale.
"""

__version__ = "0.2.0"
