"""Utilities: profiling, logging, debug instrumentation."""
