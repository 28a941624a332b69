"""Placeholder — filled this round."""
