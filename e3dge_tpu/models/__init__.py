"""Model zoo: generator stack (G0/G1), encoders (E0), local branch (E1), discriminators, full pipeline."""
