"""GUI frontends: matplotlib (always available) and Qt/pyqtgraph
(optional, ``audian-tpu[gui]``)."""
