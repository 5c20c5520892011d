"""backend subpackage."""
