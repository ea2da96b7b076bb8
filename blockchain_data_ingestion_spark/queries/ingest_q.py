"""Placeholder — filled in a later stage of this round."""
