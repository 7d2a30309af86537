"""Host-side utilities: filesystem helpers, logging."""
