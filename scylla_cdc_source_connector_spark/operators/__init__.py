"""Dataflow operators of the CDC engine (SURVEY.md §2), Spark-first."""
