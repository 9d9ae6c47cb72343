"""Operator library: composite relational operators plus the
LLM-data-pipeline extensions (dedup, similarity, text, multimodal)."""
