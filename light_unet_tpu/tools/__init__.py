"""Interop / migration tooling (torch checkpoint porting, parity checks)."""
