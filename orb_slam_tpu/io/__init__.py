"""IO: datasets, settings, trajectory writers, synthetic scene simulator."""
