"""placeholder — filled in subsequent commits."""

QUERIES = {}
ORACLES = {}
