"""Clinical domain constants shared across the framework.

These are *facts of the RADAR task* (the CheXpert-14 observation
vocabulary and the clinical knowledge-graph structure), with the same
content as the reference implementation so that labels, graph edges and
losses are semantically comparable:

- observation names/ordering: reference ``train_expert_models.py:50-65``
- clinical correlation edges: reference
  ``annotate_retrieve/modeling_expert_model_gnn.py:131-188``
- mutually-exclusive pairs: ``modeling_expert_model_gnn.py:242-252``
- correlated pairs: ``modeling_expert_model_gnn.py:275-279``
- contrastive text descriptions: ``modeling_expert_model_contrastive.py:54-74``
- RAG observation vocabulary: ``modeling_iterative_rag.py:29-36``
- findings keyword dictionary: ``scripts/data_prep.py:18-60``
"""

from __future__ import annotations

import numpy as np

# Canonical CheXpert-14 ordering used for all multi-hot label vectors.
OBSERVATION_NAMES: tuple[str, ...] = (
    "Enlarged Cardiomediastinum",  # 0
    "Cardiomegaly",                # 1
    "Lung Opacity",                # 2
    "Lung Lesion",                 # 3
    "Edema",                       # 4
    "Consolidation",               # 5
    "Pneumonia",                   # 6
    "Atelectasis",                 # 7
    "Pneumothorax",                # 8
    "Pleural Effusion",            # 9
    "Pleural Other",               # 10
    "Fracture",                    # 11
    "Support Devices",             # 12
    "No Finding",                  # 13
)

NUM_OBSERVATIONS = len(OBSERVATION_NAMES)

# Bidirectional clinical correlation edges over the 14 observations
# (indices into OBSERVATION_NAMES).  Self-loops are added when the
# adjacency matrix is built.
CLINICAL_EDGES: tuple[tuple[int, int], ...] = (
    (0, 1),   # Enlarged Cardiomediastinum <-> Cardiomegaly
    (1, 4),   # Cardiomegaly <-> Edema
    (1, 9),   # Cardiomegaly <-> Pleural Effusion
    (2, 5),   # Lung Opacity <-> Consolidation
    (2, 6),   # Lung Opacity <-> Pneumonia
    (5, 6),   # Consolidation <-> Pneumonia
    (2, 7),   # Lung Opacity <-> Atelectasis
    (9, 10),  # Pleural Effusion <-> Pleural Other
    (4, 9),   # Edema <-> Pleural Effusion
    (4, 2),   # Edema <-> Lung Opacity
    (6, 9),   # Pneumonia <-> Pleural Effusion
    (7, 9),   # Atelectasis <-> Pleural Effusion
)

# "No Finding" is mutually exclusive with any positive pathology.
EXCLUSIVE_PAIRS: tuple[tuple[int, int], ...] = (
    (13, 0), (13, 1), (13, 2), (13, 4), (13, 5),
    (13, 6), (13, 7), (13, 8), (13, 9),
)

# Positively correlated pairs whose predicted probabilities should agree.
CORRELATED_PAIRS: tuple[tuple[int, int], ...] = (
    (0, 1),  # Enlarged Cardiomediastinum & Cardiomegaly
    (1, 4),  # Cardiomegaly & Edema
    (5, 6),  # Consolidation & Pneumonia
)

# Clinical text descriptions per observation, used as the text side of
# CLIP-style contrastive pretraining.
OBSERVATION_DESCRIPTIONS: tuple[str, ...] = (
    "Enlarged cardiomediastinum with widened mediastinal contour",
    "Cardiomegaly with enlarged cardiac silhouette",
    "Lung opacity with increased density in lung parenchyma",
    "Lung lesion with focal abnormality or mass",
    "Pulmonary edema with interstitial or alveolar fluid accumulation",
    "Consolidation with dense opacification of lung tissue",
    "Pneumonia with infectious infiltrate in the lungs",
    "Atelectasis with collapsed or airless lung tissue",
    "Pneumothorax with air in the pleural space",
    "Pleural effusion with fluid in the pleural cavity",
    "Other pleural abnormality or pleural thickening",
    "Fracture with bone discontinuity or break",
    "Support devices including tubes, lines, or medical equipment",
    "No finding with normal chest radiograph appearance",
)

# Substring-matching vocabulary used by the iterative-RAG observation
# detector (a superset/alias list of the canonical 14).
RAG_OBSERVATION_VOCAB: tuple[str, ...] = (
    "Atelectasis", "Cardiomegaly", "Consolidation",
    "Edema", "Pleural Effusion", "Pneumonia",
    "Pneumothorax", "No Finding", "Fracture",
    "Support Devices", "Enlarged Cardiomediastinum",
    "Lung Opacity", "Pulmonary Edema", "Rib Fracture",
)

# The 5-observation subset conventionally reported for CheXpert
# (reference ``evaluate_expert_models.py:194-196``).
CHEXPERT5_NAMES: tuple[str, ...] = (
    "Atelectasis", "Cardiomegaly", "Consolidation", "Edema",
    "Pleural Effusion",
)
CHEXPERT5_INDICES: tuple[int, ...] = tuple(
    OBSERVATION_NAMES.index(n) for n in CHEXPERT5_NAMES
)

# Keyword dictionary for extracting findings from free-text reports
# during offline data prep.
FINDINGS_KEYWORDS: dict[str, tuple[str, ...]] = {
    # Lungs
    "atelectasis": ("atelectasis", "atelect", "collapse"),
    "pneumonia": ("pneumonia", "pneumonic", "infiltrate"),
    "pneumothorax": ("pneumothorax", "ptx"),
    "pleural_effusion": ("pleural effusion", "effusion", "fluid"),
    "pulmonary_edema": ("pulmonary edema", "edema"),
    "consolidation": ("consolidation", "consolidate"),
    "emphysema": ("emphysema",),
    "fibrosis": ("fibrosis", "fibroid"),
    "nodule": ("nodule", "nodular"),
    "mass": ("mass", "lesion"),
    "opacity": ("opacity", "opacit"),
    # Heart
    "cardiomegaly": ("cardiomegaly", "cardiac enlargement", "enlarged heart"),
    "normal_cardiac": ("normal cardiac", "normal heart size", "normal silhouette"),
    "pericardial_effusion": ("pericardial effusion",),
    # Bones
    "fracture": ("fracture", "fractured"),
    "osteoporosis": ("osteoporosis",),
    "degenerative": ("degenerative", "spondylosis"),
    # Devices
    "central_line": ("central line", "central venous"),
    "chest_tube": ("chest tube", "chest drain"),
    "pacemaker": ("pacemaker",),
    "defibrillator": ("icd", "defibrillator"),
    "endotracheal_tube": ("endotracheal", "etube", "intubat"),
    "nasogastric_tube": ("nasogastric", "ng tube"),
    "foley_catheter": ("foley", "catheter"),
    "ijv_catheter": ("internal jugular", "ijv"),
    "picc_line": ("picc line", "picc"),
    "port": ("port", "implanted port"),
    # Other
    "surgical_clips": ("surgical clip", "clip", "suture"),
    "post_surgical": ("post surgical", "postoperative", "post op"),
    "hyperinflation": ("hyperinflation",),
    "low_lung_volume": ("low lung volume", "low volume"),
    "normal": ("no acute", "no significant", "no evidence", "normal exam"),
}


def clinical_adjacency(num_observations: int = NUM_OBSERVATIONS) -> np.ndarray:
    """Dense symmetric adjacency over the clinical knowledge graph.

    Self-loops are included so each node attends to itself.  Returned as
    float32 so it can be used directly as an attention mask base.
    """
    adj = np.eye(num_observations, dtype=np.float32)
    for i, j in CLINICAL_EDGES:
        adj[i, j] = 1.0
        adj[j, i] = 1.0
    return adj


def exclusivity_matrix(num_observations: int = NUM_OBSERVATIONS) -> np.ndarray:
    """One-hot [P, 2] pair index arrays stacked into a [P, N] selector pair.

    Returns (sel_i, sel_j) as [P, N] one-hot float32 matrices so the
    consistency loss is a single matmul rather than a Python loop.
    """
    pairs = np.asarray(EXCLUSIVE_PAIRS, dtype=np.int32)
    sel_i = np.zeros((len(pairs), num_observations), np.float32)
    sel_j = np.zeros((len(pairs), num_observations), np.float32)
    sel_i[np.arange(len(pairs)), pairs[:, 0]] = 1.0
    sel_j[np.arange(len(pairs)), pairs[:, 1]] = 1.0
    return sel_i, sel_j


def correlation_matrix(num_observations: int = NUM_OBSERVATIONS) -> np.ndarray:
    """Selector pair for the correlation loss, same layout as above."""
    pairs = np.asarray(CORRELATED_PAIRS, dtype=np.int32)
    sel_i = np.zeros((len(pairs), num_observations), np.float32)
    sel_j = np.zeros((len(pairs), num_observations), np.float32)
    sel_i[np.arange(len(pairs)), pairs[:, 0]] = 1.0
    sel_j[np.arange(len(pairs)), pairs[:, 1]] = 1.0
    return sel_i, sel_j
