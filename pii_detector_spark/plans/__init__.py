"""Plans: pipeline assembly, partitioning/skew strategy, checkpoint/lineage."""
