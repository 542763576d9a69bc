"""Placeholder — operators land in a later phase this round."""
