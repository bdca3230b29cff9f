"""Model layer: pure-functional pytree models over jitted apply functions."""
