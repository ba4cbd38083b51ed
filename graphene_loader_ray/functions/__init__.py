"""Pure scalar/record-level helpers.

These encode the *semantics* the reference implements with Groovy string
munging; they are deliberately dependency-free so the pure-Python oracle
(`graphene_loader_ray.oracle`) and the Ray stages share one definition of
each transformation (single source of truth for behavior, two execution
engines).
"""
