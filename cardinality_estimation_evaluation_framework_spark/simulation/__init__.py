"""Simulation / evaluation / analysis pipeline (ref: src/simulations, src/evaluations)."""
