"""Declarative pipeline specs + loaders.

The reference stores a project as XML/JSON of modules, each module an
ordered list of tool elements instantiated by evaluating the ``Type``
attribute as a class name (reference etl.py:839-848 ``etl_factory``,
etl.py:851-904 ``Project_LoadXml``, etl.py:740-771 ``LoadProject_dict``).
We keep the same vocabulary (stage ``type`` + attrs, modules by name) but
the spec is inert data — no eval — and compiles to a DataFrame plan.

Attribute typing follows the reference's regex-on-name coercion
(reference etl.py:14-33 ``SetAttr``): ``Max|Min|Count|Index|Interval|
Position`` → int, ``^(One|Can|Is)|Enable|Should|Have|Revert`` → bool.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Any

_INT_ATTRS = re.compile("Max|Min|Count|Index|Interval|Position")
_BOOL_ATTRS = re.compile("^(One|Can|Is)|Enable|Should|Have|Revert")


def coerce_attr(key: str, value: Any) -> Any:
    if not isinstance(value, str):
        return value
    if _INT_ATTRS.search(key):
        try:
            return int(value)
        except ValueError:
            return value
    if _BOOL_ATTRS.search(key):
        return value == "True"
    return value


@dataclass
class Stage:
    type: str
    attrs: dict[str, Any] = field(default_factory=dict)

    def get(self, key: str, default: Any = None) -> Any:
        return self.attrs.get(key, default)

    @property
    def column(self) -> str:
        return self.attrs.get("Column", "") or ""

    @property
    def new_column(self) -> str:
        return self.attrs.get("NewColumn", "") or ""

    @property
    def target(self) -> str:
        """Result column: NewColumn if set else Column (reference etl.py:70-71)."""
        return self.new_column or self.column

    @property
    def enabled(self) -> bool:
        return bool(self.attrs.get("Enabled", True))


@dataclass
class EtlModule:
    name: str
    stages: list[Stage] = field(default_factory=list)
    attrs: dict[str, Any] = field(default_factory=dict)


@dataclass
class CrawlItem:
    name: str
    xpath: str


@dataclass
class CrawlerSpec:
    name: str
    url: str = ""
    is_multi_data: str = "One"  # 'One' | 'List'
    root_xpath: str = ""
    crawl_items: list[CrawlItem] = field(default_factory=list)
    headers: dict[str, str] = field(default_factory=dict)


@dataclass
class ConnectorSpec:
    name: str
    type_name: str = "FileManager"
    connect_string: str = ""


@dataclass
class ProjectSpec:
    modules: dict[str, EtlModule | CrawlerSpec] = field(default_factory=dict)
    connectors: dict[str, ConnectorSpec] = field(default_factory=dict)

    def module(self, name: str) -> EtlModule | CrawlerSpec:
        return self.modules[name]


_SKIP_ATTRS = {"Group", "Type"}


def _para2dict(text: str, line_sep: str = "\n", kv_sep: str = ":") -> dict[str, str]:
    """Reference spider.py:263-273 Para2Dict."""
    out: dict[str, str] = {}
    for line in (text or "").split(line_sep):
        if kv_sep in line:
            k, _, v = line.partition(kv_sep)
            out[k.strip()] = v.strip()
    return out


def load_project_xml(path: str) -> ProjectSpec:
    tree = ET.parse(path)
    proj = ProjectSpec()
    doc = tree.getroot().find("Doc")
    if doc is None:
        return proj
    for etool in doc:
        if etool.tag == "Children":
            etype = etool.get("Type")
            name = etool.get("Name", "")
            if etype == "SmartETLTool":
                mod = EtlModule(name=name, attrs=dict(etool.attrib))
                for m in etool:
                    if m.tag == "Children":
                        attrs = {
                            k: coerce_attr(k, v)
                            for k, v in m.attrib.items()
                            if k not in _SKIP_ATTRS
                        }
                        mod.stages.append(Stage(type=m.attrib["Type"], attrs=attrs))
                proj.modules[name] = mod
            elif etype == "SmartCrawler":
                cr = CrawlerSpec(
                    name=name,
                    url=etool.get("URL", ""),
                    is_multi_data=etool.get("IsMultiData", "One"),
                    root_xpath=etool.get("RootXPath", ""),
                )
                http = next((c for c in etool if c.tag == "HttpSet"), None)
                if http is not None:
                    cr.headers = _para2dict(http.get("Parameters", ""))
                for child in etool:
                    if child.tag == "Children":
                        cr.crawl_items.append(
                            CrawlItem(name=child.attrib["Name"], xpath=child.attrib["XPath"])
                        )
                proj.modules[name] = cr
        elif etool.tag == "DBConnections":
            for tool in etool:
                if tool.tag == "Children":
                    proj.connectors[tool.get("Name", "")] = ConnectorSpec(
                        name=tool.get("Name", ""),
                        type_name=tool.get("TypeName", "FileManager"),
                        connect_string=tool.get("ConnectString", ""),
                    )
    return proj


def load_project_json(js: str | dict) -> ProjectSpec:
    d = json.loads(js) if isinstance(js, str) else js
    proj = ProjectSpec()
    for key, conn in d.get("connectors", {}).items():
        proj.connectors[key] = ConnectorSpec(
            name=key,
            type_name=conn.get("TypeName", "FileManager"),
            connect_string=conn.get("ConnectString", ""),
        )
    for key, module in d.get("modules", {}).items():
        if "AllETLTools" in module:
            mod = EtlModule(name=key)
            for r in module["AllETLTools"]:
                attrs = {
                    k: coerce_attr(k, v) for k, v in r.items() if k not in _SKIP_ATTRS
                }
                mod.stages.append(Stage(type=r["Type"], attrs=attrs))
            proj.modules[key] = mod
        elif "CrawItems" in module:
            cr = CrawlerSpec(
                name=key,
                url=module.get("HttpItem", {}).get("Url", ""),
                is_multi_data=module.get("IsMultiData", "One"),
                root_xpath=module.get("RootXPath", ""),
            )
            for r in module["CrawItems"]:
                cr.crawl_items.append(CrawlItem(name=r["Name"], xpath=r["XPath"]))
            proj.modules[key] = cr
    return proj


def dump_project_json(proj: ProjectSpec) -> str:
    """Inverse of load_project_json (reference etl.py:796-832 convert_dict) —
    the wire format for shipping a plan to executors (spark-submit --py-files
    ships code; the spec rides in the job description)."""
    d: dict[str, Any] = {"connectors": {}, "modules": {}}
    for k, c in proj.connectors.items():
        d["connectors"][k] = {"Name": c.name, "TypeName": c.type_name, "ConnectString": c.connect_string}
    for k, m in proj.modules.items():
        if isinstance(m, EtlModule):
            d["modules"][k] = {
                "AllETLTools": [dict(s.attrs, Type=s.type) for s in m.stages]
            }
        else:
            d["modules"][k] = {
                "IsMultiData": m.is_multi_data,
                "RootXPath": m.root_xpath,
                "HttpItem": {"Url": m.url, "Headers": m.headers},
                "CrawItems": [{"Name": ci.name, "XPath": ci.xpath} for ci in m.crawl_items],
            }
    return json.dumps(d, ensure_ascii=False, indent=2)
