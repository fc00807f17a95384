"""Pure-function compute ops (no parameters, jit-able, static shapes)."""
