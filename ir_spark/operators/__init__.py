"""Relational + custom operators: index build (E1/E2), query (E3),
dedup, ANN, text analytics."""
