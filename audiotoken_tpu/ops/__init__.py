"""Device-side ops: convolution helpers, attention, nearest-neighbor lookup."""
