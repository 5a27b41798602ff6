"""Placeholder — populated in this round."""
