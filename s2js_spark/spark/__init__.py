"""Spark surface of the engine: registered pandas UDFs, page-table
synthesis, spatial joins, and training-data pipeline operators."""
