"""E0 encoders (IR-SE-50 FPN and variants)."""
