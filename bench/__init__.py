"""Probe-bench scripts and the shared timing harness (bench/_harness.py)."""
