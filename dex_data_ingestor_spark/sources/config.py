"""Multi-environment source configuration.

Re-expresses the reference's ``config.ini`` layout (reference:
src/config/MultiEnvDBConfig.py:13-19 — a ``[database]`` base section
overlaid by ``[local]`` / ``[remote]`` sections) as a small helper that
yields per-environment JDBC reader/writer option dicts.
"""

from __future__ import annotations

import configparser


class MultiEnvConfig:
    """Parse an ini file with a base section + per-env overlay sections.

    >>> cfg = MultiEnvConfig.from_string(
    ...     "[database]\\nuser=u\\npassword=p\\n"
    ...     "[remote]\\nhost=r.example\\nport=3306\\ndatabase=raw\\n"
    ...     "[local]\\nhost=l.example\\nport=3306\\ndatabase=warehouse\\n"
    ... )
    >>> cfg.env("remote")["host"]
    'r.example'
    """

    BASE_SECTION = "database"

    def __init__(self, parser: configparser.ConfigParser):
        self._parser = parser

    @classmethod
    def from_file(cls, path: str) -> "MultiEnvConfig":
        parser = configparser.ConfigParser()
        with open(path) as fh:
            parser.read_file(fh)
        return cls(parser)

    @classmethod
    def from_string(cls, text: str) -> "MultiEnvConfig":
        parser = configparser.ConfigParser()
        parser.read_string(text)
        return cls(parser)

    def env(self, name: str) -> dict[str, str]:
        """Base section values overlaid with the named section's."""
        out: dict[str, str] = {}
        if self._parser.has_section(self.BASE_SECTION):
            out.update(self._parser.items(self.BASE_SECTION))
        if self._parser.has_section(name):
            out.update(self._parser.items(name))
        return out

    def jdbc_url(self, name: str, dialect: str = "mysql") -> str:
        env = self.env(name)
        return (
            f"jdbc:{dialect}://{env.get('host', 'localhost')}:"
            f"{env.get('port', '3306')}/{env.get('database', '')}"
        )
