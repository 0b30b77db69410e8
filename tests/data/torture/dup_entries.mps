* Duplicate COLUMNS entries must SUM (scipy COO->CSR semantics, matched
* by the native parser): X hits COST twice (1+2=3) and R1 twice (.5+.5=1).
* min 3x  s.t.  x >= 2  ->  optimum 6.0
NAME          DUPENT
ROWS
 N  COST
 G  R1
COLUMNS
    X         COST      1.0        R1        0.5
    X         COST      2.0
    X         R1        0.5
RHS
    RHS       R1        2.0
ENDATA
