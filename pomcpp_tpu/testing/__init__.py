"""Test-support utilities (parity oracle driver, state conversion)."""
