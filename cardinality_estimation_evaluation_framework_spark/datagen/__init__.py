"""Data derivation + synthetic set/multiset generators (ref: src/simulations)."""
