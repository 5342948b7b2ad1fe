"""Infra utilities: logging, timers, dict tools."""
