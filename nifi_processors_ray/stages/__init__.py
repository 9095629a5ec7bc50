"""Pipeline stages: stateless batch transforms + the stateful merge."""
