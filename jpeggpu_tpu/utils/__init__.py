"""Host-side utilities (color conversion, logging)."""
