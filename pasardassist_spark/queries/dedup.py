"""Placeholder — filled in this round."""
