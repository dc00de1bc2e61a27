"""Graph layer: a graph = (vertices DataFrame, edges DataFrame), Cypher-ish
pattern matching compiled to join chains, and Pregel-style message passing —
the SURVEY.md §2.3 surface."""
