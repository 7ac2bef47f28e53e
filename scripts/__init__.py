"""CLI entry points (training, evaluation, demo generation).

Regular package (not namespace) so `import scripts.*` always resolves here
even when other trees with a `scripts/` package are on sys.path.
"""
