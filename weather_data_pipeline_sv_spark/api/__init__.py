"""HTTP serving layer (stdlib WSGI) over the gold query functions."""

from .app import create_app, serve  # noqa: F401
