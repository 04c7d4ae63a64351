"""Dataset preprocessing toolkit."""
