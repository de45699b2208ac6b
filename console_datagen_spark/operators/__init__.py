"""Reusable DataFrame operators (dedup, similarity, top-k, multimodal)."""
