"""Query plans: the engine's headline query fleet + DuckDB oracle SQL."""

from .queries import ORACLES, QUERIES, flagship, register_corpus_views

__all__ = ["QUERIES", "ORACLES", "flagship"]
