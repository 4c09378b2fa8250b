"""Host-side IO: dataset iterators, PFM reader, synthetic scenes."""
