-- Pagila-SHAPED fixture for PagilaLiveSpec: the reference's live-PG
-- gate loads the real pagila dump (Makefile `load-data`); that dump is
-- a git submodule NOT present in this sandbox (reference pagila/ is
-- empty) and cannot be fetched offline. This fixture recreates the 14
-- tables the reference's test_basic_select_all_tables reads (film
-- excluded exactly as the reference does) with pagila's real COLUMN
-- TYPES — serial/int4, int2, varchar(n), bpchar, text, numeric(5,2),
-- timestamptz, date, boolean, bytea, and NULL stripes — and
-- deterministic generated rows, so the wire/type surface the suite
-- exists to exercise is the same even though the row CONTENT is
-- synthesized.
DROP TABLE IF EXISTS actor, address, category, city, country, customer,
  film_actor, film_category, inventory, language, payment, rental,
  staff, store, flaco_test_table CASCADE;

CREATE TABLE country (
  country_id serial PRIMARY KEY,
  country varchar(50) NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO country
SELECT i, 'Country ' || i,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i)
FROM generate_series(1, 109) i;

CREATE TABLE city (
  city_id serial PRIMARY KEY,
  city varchar(50) NOT NULL,
  country_id int2 NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO city
SELECT i, 'City ' || i, (i % 109 + 1)::int2,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i)
FROM generate_series(1, 600) i;

CREATE TABLE address (
  address_id serial PRIMARY KEY,
  address varchar(50) NOT NULL,
  address2 varchar(50),
  district varchar(20) NOT NULL,
  city_id int2 NOT NULL,
  postal_code varchar(10),
  phone varchar(20) NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO address
SELECT i, i || ' Main Street',
  CASE WHEN i % 5 = 0 THEN NULL ELSE 'Apt ' || i END,
  'District ' || (i % 20), (i % 600 + 1)::int2,
  CASE WHEN i % 7 = 0 THEN NULL ELSE lpad((i * 37 % 100000)::text, 5, '0') END,
  lpad((i * 7919)::text, 10, '0'),
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i)
FROM generate_series(1, 603) i;

CREATE TABLE category (
  category_id serial PRIMARY KEY,
  name varchar(25) NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO category
SELECT i, 'Category ' || i,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i)
FROM generate_series(1, 16) i;

CREATE TABLE language (
  language_id serial PRIMARY KEY,
  name bpchar(20) NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO language
SELECT i, rpad('Lang' || i, 20), 
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i)
FROM generate_series(1, 6) i;

CREATE TABLE actor (
  actor_id serial PRIMARY KEY,
  first_name varchar(45) NOT NULL,
  last_name varchar(45) NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO actor
SELECT i, 'First' || i, 'Last' || (i % 37),
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i)
FROM generate_series(1, 200) i;

CREATE TABLE customer (
  customer_id serial PRIMARY KEY,
  store_id int2 NOT NULL,
  first_name varchar(45) NOT NULL,
  last_name varchar(45) NOT NULL,
  email varchar(50),
  address_id int2 NOT NULL,
  activebool boolean NOT NULL DEFAULT true,
  create_date date NOT NULL,
  last_update timestamptz,
  active int4
);
INSERT INTO customer
SELECT i, (i % 2 + 1)::int2, 'Cust' || i, 'Name' || (i % 101),
  CASE WHEN i % 11 = 0 THEN NULL
       ELSE 'cust' || i || '@example.test' END,
  (i % 603 + 1)::int2, i % 13 <> 0,
  '2022-01-01'::date + (i % 365),
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i),
  CASE WHEN i % 13 = 0 THEN 0 ELSE 1 END
FROM generate_series(1, 599) i;

CREATE TABLE staff (
  staff_id serial PRIMARY KEY,
  first_name varchar(45) NOT NULL,
  last_name varchar(45) NOT NULL,
  address_id int2 NOT NULL,
  email varchar(50),
  store_id int2 NOT NULL,
  active boolean NOT NULL DEFAULT true,
  username varchar(16) NOT NULL,
  password varchar(40),
  last_update timestamptz NOT NULL,
  picture bytea
);
INSERT INTO staff
SELECT i, 'Staff' || i, 'Member' || i, (i % 603 + 1)::int2,
  'staff' || i || '@example.test', (i % 2 + 1)::int2, true,
  'user' || i,
  CASE WHEN i % 2 = 0 THEN NULL ELSE md5('pw' || i) END,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i),
  CASE WHEN i % 2 = 0 THEN decode(md5('pic' || i), 'hex') ELSE NULL END
FROM generate_series(1, 4) i;

CREATE TABLE store (
  store_id serial PRIMARY KEY,
  manager_staff_id int2 NOT NULL,
  address_id int2 NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO store
SELECT i, i::int2, (i % 603 + 1)::int2,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(mins => i)
FROM generate_series(1, 2) i;

CREATE TABLE film_actor (
  actor_id int2 NOT NULL,
  film_id int2 NOT NULL,
  last_update timestamptz NOT NULL,
  PRIMARY KEY (actor_id, film_id)
);
INSERT INTO film_actor
SELECT (i % 200 + 1)::int2, (i / 200 + 1)::int2,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(secs => i)
FROM generate_series(0, 5461) i;

CREATE TABLE film_category (
  film_id int2 NOT NULL,
  category_id int2 NOT NULL,
  last_update timestamptz NOT NULL,
  PRIMARY KEY (film_id, category_id)
);
INSERT INTO film_category
SELECT i::int2, (i % 16 + 1)::int2,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(secs => i)
FROM generate_series(1, 1000) i;

CREATE TABLE inventory (
  inventory_id serial PRIMARY KEY,
  film_id int2 NOT NULL,
  store_id int2 NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO inventory
SELECT i, (i % 1000 + 1)::int2, (i % 2 + 1)::int2,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(secs => i)
FROM generate_series(1, 4581) i;

CREATE TABLE rental (
  rental_id serial PRIMARY KEY,
  rental_date timestamptz NOT NULL,
  inventory_id int4 NOT NULL,
  customer_id int2 NOT NULL,
  return_date timestamptz,
  staff_id int2 NOT NULL,
  last_update timestamptz NOT NULL
);
INSERT INTO rental
SELECT i,
  '2022-02-01 00:00:00+00'::timestamptz + make_interval(mins => i),
  i % 4581 + 1, (i % 599 + 1)::int2,
  CASE WHEN i % 10 = 0 THEN NULL
       ELSE '2022-02-01 00:00:00+00'::timestamptz
              + make_interval(mins => i, days => i % 9 + 1) END,
  (i % 4 + 1)::int2,
  '2022-02-15 10:00:00+00'::timestamptz + make_interval(secs => i)
FROM generate_series(1, 16044) i;

CREATE TABLE payment (
  payment_id serial PRIMARY KEY,
  customer_id int2 NOT NULL,
  staff_id int2 NOT NULL,
  rental_id int4 NOT NULL,
  amount numeric(5,2) NOT NULL,
  payment_date timestamptz NOT NULL
);
INSERT INTO payment
SELECT i, (i % 599 + 1)::int2, (i % 4 + 1)::int2, i % 16044 + 1,
  round((((i * 37) % 999) + 1)::numeric / 100 * 10, 2),
  '2022-02-01 00:00:00+00'::timestamptz + make_interval(mins => i)
FROM generate_series(1, 14596) i;

ANALYZE;
