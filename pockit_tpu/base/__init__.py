"""Problem-definition layer: symbolic frontend (System/Phase/Variable) and
the static discretization data that turns a phase into dense tensors."""
