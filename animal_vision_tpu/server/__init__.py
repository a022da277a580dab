"""Serving layer (REST + streaming), API parity with server/server.py."""
