"""Interop: the torch oracle (fixture generation / parity testing) and
manifest-based weight exchange between frameworks."""
