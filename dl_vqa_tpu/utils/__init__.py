"""Utilities: logging, checkpointing, seeding, torch interop."""
