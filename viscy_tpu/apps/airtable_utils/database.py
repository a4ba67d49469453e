"""Experiment registry / Airtable client
(reference ``airtable_utils/database.py:39``)."""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any

from viscy_tpu.data.schemas import FOVRecord

_logger = logging.getLogger("viscy_tpu")


class ExperimentRegistry:
    """File-backed registry of FOV records (one JSON per experiment)."""

    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, experiment: str) -> Path:
        return self.root / f"{experiment}.json"

    def register_fovs(self, experiment: str, records: list[FOVRecord]) -> None:
        existing = {r.fov_name: r for r in self.list_fovs(experiment)}
        for r in records:
            existing[r.fov_name] = r
        payload = [r.model_dump(exclude_none=True) for r in existing.values()]
        self._path(experiment).write_text(json.dumps(payload, indent=2))

    def list_fovs(self, experiment: str, **filters: Any) -> list[FOVRecord]:
        path = self._path(experiment)
        if not path.exists():
            return []
        records = [FOVRecord(**r) for r in json.loads(path.read_text())]
        for key, value in filters.items():
            records = [r for r in records if getattr(r, key, None) == value]
        return records

    def experiments(self) -> list[str]:
        return sorted(p.stem for p in self.root.glob("*.json"))


class AirtableClient:
    """Minimal Airtable REST client (requires network; reference
    ``database.py:39``). Raises a clear error in offline environments."""

    BASE_URL = "https://api.airtable.com/v0"

    def __init__(self, api_key: str, base_id: str) -> None:
        self.api_key = api_key
        self.base_id = base_id

    def _request(self, method: str, table: str, payload: dict | None = None, params: str = ""):
        import urllib.error
        import urllib.request

        url = f"{self.BASE_URL}/{self.base_id}/{table}{params}"
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode() if payload else None,
            method=method,
            headers={
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read())
        except urllib.error.URLError as e:
            raise ConnectionError(
                f"Airtable unreachable ({e}); use ExperimentRegistry for offline work"
            ) from e

    def list_records(self, table: str, view: str | None = None) -> list[dict]:
        params = f"?view={view}" if view else ""
        out = []
        data = self._request("GET", table, params=params)
        out.extend(data.get("records", []))
        while data.get("offset"):
            data = self._request("GET", table, params=f"{params}&offset={data['offset']}")
            out.extend(data.get("records", []))
        return out

    def create_records(self, table: str, fields_list: list[dict]) -> list[dict]:
        out = []
        for i in range(0, len(fields_list), 10):
            chunk = fields_list[i : i + 10]
            data = self._request(
                "POST", table, payload={"records": [{"fields": f} for f in chunk]}
            )
            out.extend(data.get("records", []))
        return out

    def to_registry(self, table: str, registry: ExperimentRegistry, experiment: str) -> None:
        records = self.list_records(table)
        fovs = [FOVRecord(**r["fields"]) for r in records if "fov_name" in r.get("fields", {})]
        registry.register_fovs(experiment, fovs)
