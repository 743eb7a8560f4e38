"""Operators: extraction, dedup, scheduling, seen-set, similarity, text stats."""
