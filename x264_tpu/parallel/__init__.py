"""Multi-chip parallelism — the TPU-native re-expression of x264's thread
strategies (SURVEY §2.3): sliced-band SP over a device mesh here; frame/GOP
pipelining over hosts in later rounds."""
