"""Data layer: pickle-schema loaders, chat collator, samplers, fixtures."""
