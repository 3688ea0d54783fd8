"""Camera math, rays, volume integration."""
