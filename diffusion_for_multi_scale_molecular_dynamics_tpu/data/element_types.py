"""Element name <-> integer id mapping.

Ids are assigned by sorted element name; the MASK class is the last id
(= number of elements) and NULL_ELEMENT_ID marks padding atoms.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/data/element_types.py:7)
"""

from typing import List

NULL_ELEMENT = "NULL_ELEMENT_FOR_PADDING"
NULL_ELEMENT_ID = -1
MASK_ELEMENT = "MASK"


class ElementTypes:
    """Bidirectional element <-> id registry."""

    def __init__(self, elements: List[str]):
        self.validate_elements(elements)
        self._elements = sorted(elements)
        self._ids = list(range(len(self._elements)))
        self._element_to_id = {e: i for i, e in enumerate(self._elements)}
        self._element_to_id[NULL_ELEMENT] = NULL_ELEMENT_ID

    @staticmethod
    def validate_elements(elements: List[str]) -> None:
        assert len(set(elements)) == len(elements), "Elements must be unique."
        assert NULL_ELEMENT not in elements, (
            f"'{NULL_ELEMENT}' is reserved for padding."
        )
        assert MASK_ELEMENT not in elements, f"'{MASK_ELEMENT}' is reserved."

    @property
    def number_of_atom_types(self) -> int:
        return len(self._elements)

    @property
    def mask_id(self) -> int:
        return len(self._elements)

    @property
    def elements(self) -> List[str]:
        return list(self._elements)

    @property
    def element_ids(self) -> List[int]:
        return list(self._ids)

    def get_element(self, element_id: int) -> str:
        if element_id == NULL_ELEMENT_ID:
            return NULL_ELEMENT
        if element_id == self.mask_id:
            return MASK_ELEMENT
        return self._elements[element_id]

    def get_element_id(self, element: str) -> int:
        return self._element_to_id[element]
