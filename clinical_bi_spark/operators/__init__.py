"""Composite operators built from DataFrame primitives: splits, dedup
families, similarity search. Each is a plain function DataFrame → DataFrame
so it composes with any query plan.
"""
