"""Experiment registry / Airtable client
(reference ``airtable_utils/database.py:39``)."""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
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


TABLE_NAME = "Datasets"
MARKER_REGISTRY_TABLE = "Marker Registry"


@dataclass
class MarkerRegistryEntry:
    """A single Marker Registry entry (reference ``database.py:17-37``):
    construct name, channel-name alias tokens, and protein marker."""

    record_id: str
    marker_fluorophore: str
    channel_name_aliases: list[str]
    marker: str


class AirtableDatasets:
    """Interface to the Datasets table (reference ``database.py:39-160``).

    Credentials come from ``AIRTABLE_API_KEY`` / ``AIRTABLE_BASE_ID`` env
    vars. For offline tests, pass ``table``/``registry_table`` objects
    implementing ``all(formula=..., fields=...)``, ``batch_update``,
    ``batch_create``, ``batch_delete`` (the pyairtable Table surface).
    """

    def __init__(self, table: Any = None, registry_table: Any = None) -> None:
        if table is None or registry_table is None:
            import os

            api_key = os.environ.get("AIRTABLE_API_KEY", "")
            base_id = os.environ.get("AIRTABLE_BASE_ID", "")
            if not api_key:
                raise ValueError("AIRTABLE_API_KEY environment variable is required but not set.")
            if not base_id:
                raise ValueError("AIRTABLE_BASE_ID environment variable is required but not set.")
            client = AirtableClient(api_key, base_id)
            table = table or _RestTable(client, TABLE_NAME)
            registry_table = registry_table or _RestTable(client, MARKER_REGISTRY_TABLE)
        self._table = table
        self._registry_table = registry_table

    def list_records(self, filter_formula: str | None = None):
        """All FOV records as a DataFrame."""
        import pandas as pd

        from viscy_tpu.apps.airtable_utils.schemas import DatasetRecord

        kwargs = {"formula": filter_formula} if filter_formula else {}
        raw = self._table.all(**kwargs)
        records = [DatasetRecord.from_airtable_record(r) for r in raw]
        return pd.DataFrame([r.model_dump() for r in records])

    def get_dataset_records(self, dataset_name: str) -> list:
        """FOV records filtered to one dataset."""
        from viscy_tpu.apps.airtable_utils.schemas import DatasetRecord

        formula = f"{{dataset}} = '{dataset_name}'"
        raw = self._table.all(formula=formula)
        return [DatasetRecord.from_airtable_record(r) for r in raw]

    def get_unique_datasets(self) -> list[str]:
        raw = self._table.all(fields=["dataset"])
        names = {
            r["fields"]["dataset"] for r in raw if r.get("fields", {}).get("dataset")
        }
        return sorted(names)

    def batch_update(self, updates: list[dict]) -> None:
        self._table.batch_update(updates)

    def batch_create(self, records: list[dict]) -> list[dict]:
        return self._table.batch_create([r["fields"] for r in records])

    def batch_delete(self, record_ids: list[str]) -> list[dict]:
        return self._table.batch_delete(record_ids)

    def get_marker_registry(self) -> dict[str, MarkerRegistryEntry]:
        """Marker Registry keyed by Airtable record ID; aliases are a
        comma-separated field (reference ``database.py:107-130``)."""
        raw = self._registry_table.all(
            fields=["marker-fluorophore", "channel_name_aliases", "marker"]
        )
        registry: dict[str, MarkerRegistryEntry] = {}
        for rec in raw:
            fields = rec.get("fields", {})
            marker_fluorophore = fields.get("marker-fluorophore", "")
            aliases = [
                a.strip()
                for a in fields.get("channel_name_aliases", "").split(",")
                if a.strip()
            ]
            marker = fields.get("marker", "")
            if marker_fluorophore and aliases and marker:
                registry[rec["id"]] = MarkerRegistryEntry(
                    record_id=rec["id"],
                    marker_fluorophore=marker_fluorophore,
                    channel_name_aliases=aliases,
                    marker=marker,
                )
        return registry


class _RestTable:
    """pyairtable-Table-shaped adapter over :class:`AirtableClient`."""

    def __init__(self, client: AirtableClient, table: str) -> None:
        self._client = client
        self._table = table

    def all(self, formula: str | None = None, fields: list[str] | None = None) -> list[dict]:
        import urllib.parse

        params = []
        if formula:
            params.append(f"filterByFormula={urllib.parse.quote(formula)}")
        if fields:
            params.extend(f"fields%5B%5D={urllib.parse.quote(f)}" for f in fields)
        query = "?" + "&".join(params) if params else ""
        out: list[dict] = []
        data = self._client._request("GET", self._table, params=query)
        out.extend(data.get("records", []))
        while data.get("offset"):
            sep = "&" if query else "?"
            data = self._client._request(
                "GET", self._table, params=f"{query}{sep}offset={data['offset']}"
            )
            out.extend(data.get("records", []))
        return out

    def batch_update(self, updates: list[dict]) -> list[dict]:
        out = []
        for i in range(0, len(updates), 10):
            chunk = updates[i : i + 10]
            data = self._client._request(
                "PATCH", self._table, payload={"records": chunk}
            )
            out.extend(data.get("records", []))
        return out

    def batch_create(self, fields_list: list[dict]) -> list[dict]:
        return self._client.create_records(self._table, fields_list)

    def batch_delete(self, record_ids: list[str]) -> list[dict]:
        out = []
        for i in range(0, len(record_ids), 10):
            chunk = record_ids[i : i + 10]
            params = "?" + "&".join(f"records%5B%5D={rid}" for rid in chunk)
            data = self._client._request("DELETE", self._table, params=params)
            out.extend(data.get("records", []))
        return out
