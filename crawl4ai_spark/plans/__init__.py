"""Plans: the iterative crawl driver (level-synchronous supersteps
over snapshot-versioned state tables) and the snapshot store.

Design stance (SURVEY.md §7.0): iterative batch, not Structured
Streaming — each iteration is one declarative DataFrame DAG
(admission window → fetch join → extract UDF → link explode →
filter/score → anti-join seen → merge state), which matches the
reference's BFS/best-first level semantics exactly and makes
checkpoint/resume a snapshot read."""
