"""Semantic graph subpackage."""
from sgtd_tpu.graph.types import SemanticGraph, make_graph  # noqa: F401
