"""Graph data model: nodes + typed properties + relationships.

Mirrors the reference's model-description YAML contract
(/root/reference/3-Model-Files/cds-model.yml:3-345 and
cds-model-props.yml `PropDefinitions`) but compiles it into Spark
artifacts: a StructType per node and constraint metadata (enum
domains, regex patterns, required flags) used by the validation
operators. Accepts either parsed dicts or YAML file paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class PropDef:
    name: str
    type: str = "string"  # string | integer | number | list | enum
    enum: tuple[str, ...] | None = None
    pattern: str | None = None  # regex the value must fully match
    required: bool = False
    is_key: bool = False

    def spark_type(self) -> T.DataType:
        if self.type == "integer":
            return T.LongType()
        if self.type == "number":
            return T.DoubleType()
        if self.type == "list":
            return T.ArrayType(T.StringType())
        return T.StringType()


@dataclass(frozen=True)
class Relationship:
    """A typed edge: child (src) → parent (dst).

    `mul` is the multiplicity declared in the model
    (cds-model.yml:308-345): many_to_one everywhere except
    `from_sample` (file→sample) which is many_to_many — the id
    validator's duplicate exemption keys off this.
    """

    name: str
    mul: str
    src: str
    dst: str


@dataclass
class Model:
    nodes: dict[str, list[str]]  # node -> ordered property names
    relationships: list[Relationship]
    props: dict[str, PropDef] = field(default_factory=dict)
    version: str | None = None

    def prop(self, name: str) -> PropDef:
        return self.props.get(name, PropDef(name))

    def node_struct(self, node: str, include_type: bool = True) -> T.StructType:
        fields = [
            T.StructField(p, self.prop(p).spark_type(), not self.prop(p).required)
            for p in self.nodes[node]
        ]
        for rel in self.relationships:
            if rel.src == node:
                fields.append(T.StructField(f"{rel.dst}.{rel.name}", T.StringType(), True))
        if include_type:
            fields.append(T.StructField("type", T.StringType(), False))
        return T.StructType(fields)

    def children_of(self, node: str) -> list[Relationship]:
        return [r for r in self.relationships if r.dst == node]

    def parents_of(self, node: str) -> list[Relationship]:
        return [r for r in self.relationships if r.src == node]

    def mul_of(self, name: str) -> str:
        for r in self.relationships:
            if r.name == name:
                return r.mul
        return "many_to_one"


def _parse_prop_def(name: str, d: dict | None) -> PropDef:
    if not isinstance(d, dict):
        return PropDef(name)
    ptype, enum, pattern = "string", None, None
    t = d.get("Type", d.get("type"))
    if "Enum" in d:
        ptype, enum = "enum", tuple(str(v) for v in d["Enum"])
    elif isinstance(t, dict):
        if t.get("value_type") == "list":
            ptype = "list"
        elif t.get("pattern"):
            ptype, pattern = "string", t["pattern"]
        elif t.get("value_type") in ("number", "integer"):
            ptype = t["value_type"]
    elif isinstance(t, str):
        if t in ("integer", "number"):
            ptype = t
        elif t not in ("string", "url"):
            ptype = "string"
    return PropDef(
        name,
        ptype,
        enum,
        pattern,
        required=bool(d.get("Req", False)),
        is_key=bool(d.get("Key", False)),
    )


def load_model(nodes: dict | str, props: dict | str | None = None) -> Model:
    """Build a Model from parsed YAML dicts (or YAML file paths).

    `nodes` follows the reference's shape:
        {"Nodes": {name: {"Props": [...]}},
         "Relationships": {rel: {"Mul": ..., "Ends": [{"Src":..,"Dst":..}]}}}
    `props`: {"PropDefinitions": {prop: {...}}}
    """
    import yaml

    if isinstance(nodes, str):
        with open(nodes) as f:
            nodes = yaml.safe_load(f)
    if isinstance(props, str):
        with open(props) as f:
            props = yaml.safe_load(f)

    node_map = {n: list(spec.get("Props") or []) for n, spec in nodes.get("Nodes", {}).items()}
    rels: list[Relationship] = []
    for rname, spec in (nodes.get("Relationships") or {}).items():
        for end in spec.get("Ends", []):
            rels.append(Relationship(rname, spec.get("Mul", "many_to_one"), end["Src"], end["Dst"]))

    prop_defs: dict[str, PropDef] = {}
    for pname, spec in ((props or {}).get("PropDefinitions") or {}).items():
        prop_defs[pname] = _parse_prop_def(pname, spec)

    return Model(node_map, rels, prop_defs, version=nodes.get("Version"))
