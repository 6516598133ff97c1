"""Sources: deterministic synthetic pages corpus + derived views over testdata."""
