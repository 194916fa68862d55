"""Deliberately literal port of convert_alps_to_cdr.py's per-sample
conversion (reference :62-101), used ONLY as a parity oracle in tests.
Mirrors the quirks exactly: stable len-desc sort, break-less scan with
in-pass advancement, per-object is_checked, code-level exclusion set."""

from __future__ import annotations

import copy


def convert_sample_to_text(sample: dict, entity_dict: dict[str, int]) -> str:
    text = sample["text"]
    entities = sorted(sample["entities"], key=lambda x: len(x), reverse=True)
    new_entities = []
    for entity in entities:
        a_entity = {"text": entity, "code": entity_dict[entity]}
        if entity in sample["cause"]:
            a_entity["label"] = "Chemical"
        elif entity in sample["effect"]:
            a_entity["label"] = "Disease"
        else:
            a_entity["label"] = "Other"
        new_entities.append(a_entity)
    entities = new_entities
    entities_processed_list = []
    relation_list = []
    i = 0
    while i < len(text):
        for entity in entities:
            if text[i:].startswith(entity["text"]):
                entity["is_checked"] = True
                a_entity = copy.deepcopy(entity)
                a_entity["start"] = i
                entities_processed_list.append(a_entity)
                i += len(entity["text"])
        i += 1
    not_checked_entity = []
    for entity in entities:
        if "is_checked" not in entity:
            not_checked_entity.append(entity["code"])
    for ci in range(len(sample["cause"])):
        for ej in range(len(sample["effect"])):
            if (
                entity_dict[sample["cause"][ci]] not in not_checked_entity
                and entity_dict[sample["effect"][ej]] not in not_checked_entity
            ):
                relation_list.append(
                    (entity_dict[sample["cause"][ci]], entity_dict[sample["effect"][ej]])
                )
    index = sample["sample_id"]
    out = [str(index) + "|t|", str(index) + "|a|" + text]
    for e in entities_processed_list:
        out.append(
            str(index)
            + "\t"
            + str(e["start"] + 1)
            + "\t"
            + str(e["start"] + 1 + len(e["text"]))
            + "\t"
            + e["text"]
            + "\t"
            + e["label"]
            + "\t"
            + str(e["code"])
        )
    for rel in relation_list:
        out.append(str(index) + "\tCID\t" + str(rel[0]) + "\t" + str(rel[1]))
    return "\n".join(out) + "\n"
