"""Web-scale KG construction: extract → mentions → link → canonicalize."""
