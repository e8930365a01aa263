"""gwkit.evaluation — FAR / sensitive-distance / efficiency / ROC oracles.

These are the acceptance tests of the framework (the reference's substitute
for a test suite — SURVEY.md §4), so they are deliberately CPU/numpy and
match the reference's outputs exactly.
"""
