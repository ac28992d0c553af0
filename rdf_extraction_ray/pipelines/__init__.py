"""End-to-end pipelines (SURVEY.md §7.1)."""

from .kg import extract_facts, kg_pipeline, link_facts, triples_from_turns

__all__ = ["extract_facts", "link_facts", "triples_from_turns", "kg_pipeline"]
