"""Jobs: training, evaluation, search."""
