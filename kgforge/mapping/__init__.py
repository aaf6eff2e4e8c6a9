"""Declarative column→RDF mapping: spec IR + grammar compilers."""
