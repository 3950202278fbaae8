"""Experiment/benchmark scripts and measured-negative artifacts.

Not part of the shipped videoquery package.
"""
