"""Populated in a later phase."""
