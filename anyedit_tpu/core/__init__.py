from anyedit_tpu.core.schema import InstructionRecord, read_records, write_records
from anyedit_tpu.core.ledger import RunLedger
from anyedit_tpu.core.mesh import make_mesh, MeshSpec
