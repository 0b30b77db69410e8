* Simple test LP:
*   min  x + 2y + 3z - 1
*   s.t. x + y      =  10
*        y + z     <=  15
*        x     + z >=   5
*        2 <= x - y + z <= 8   (ranged row)
*   0 <= x <= 6, y >= -2, z free
NAME          SIMPLE
ROWS
 N  COST
 E  R1
 L  R2
 G  R3
 L  R4
COLUMNS
    X         COST      1.0        R1        1.0
    X         R3        1.0        R4        1.0
    Y         COST      2.0        R1        1.0
    Y         R2        1.0        R4       -1.0
    Z         COST      3.0        R2        1.0
    Z         R3        1.0        R4        1.0
RHS
    RHS       R1        10.0       R2        15.0
    RHS       R3        5.0        R4        8.0
    RHS       COST      1.0
RANGES
    RNG       R4        6.0
BOUNDS
 UP BND       X         6.0
 LO BND       Y         -2.0
 FR BND       Z
ENDATA
