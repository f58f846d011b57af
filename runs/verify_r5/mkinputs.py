import sys, pathlib
import numpy as np
root = pathlib.Path(sys.argv[1])
root.mkdir(parents=True, exist_ok=True)
ETHANOL_SDF = """ethanol
  synth

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.4000    0.6000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    2.1000    1.3000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0  0  0  0
  2  3  1  0  0  0  0
M  END
"""

def pdb_line(rec, serial, name, res, chain, resid, x, y, z, element):
    return (
        f"{rec:<6}{serial:>5} {name:<4} {res:<3} {chain}{resid:>4}    "
        f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          {element:>2}"
    )

rng = np.random.RandomState(0)
pairs = []
for n in range(8):
    lines, serial = [], 1
    for ri in range(1, 7):
        base = rng.randn(3) * 2.5
        for name, el in [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")]:
            x, y, z = base + rng.randn(3) * 0.4
            lines.append(pdb_line("ATOM", serial, name, "ALA", "A", ri, x, y, z, el))
            serial += 1
    # ligand HETATM residue A:101 near the pocket center
    for k in range(3):
        x, y, z = rng.randn(3) * 1.0
        lines.append(pdb_line("HETATM", serial, f"C{k+1}", "LIG", "A", 101, x, y, z, "C"))
        serial += 1
    pdb = root / f"pocket_{n}.pdb"
    pdb.write_text("\n".join(lines) + "\n")
    sdf = root / f"lig_{n}.sdf"
    sdf.write_text(ETHANOL_SDF)
    split = "test" if n >= 7 else "train"
    pairs.append(f"{split}\t{pdb}\t{sdf}")
(root / "pairs.tsv").write_text("\n".join(pairs) + "\n")
smiles = ["CCO", "CCN", "CCC", "c1ccccc1O", "c1ccccc1N", "CC(=O)O",
          "c1ccncc1", "CC(C)CO", "c1ccccc1CO", "CCOC", "CCNC", "CC(N)C(=O)O",
          "c1ccc2ccccc2c1", "CC(=O)Nc1ccc(O)cc1", "CCS", "NCCO"] * 4
(root / "smiles.txt").write_text("\n".join(smiles) + "\n")
print("inputs ok:", root)
