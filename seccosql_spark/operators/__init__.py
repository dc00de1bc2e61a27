"""Operators Spark lacks a primitive for, each expressed as DataFrame-plan
construction (never driver-side row loops) so Catalyst/AQE owns execution."""
