"""CLI experiment scripts (reference ``scripts/`` parity, one module each)."""
