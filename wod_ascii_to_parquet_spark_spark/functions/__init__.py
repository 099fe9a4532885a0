"""Engine scalar functions (geohash, vector math helpers)."""
