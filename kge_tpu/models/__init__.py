"""Model zoo (populated as models are implemented)."""
